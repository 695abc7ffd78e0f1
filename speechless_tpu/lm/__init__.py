from .ngram import ArpaLanguageModel, NativeArpaLanguageModel, load_language_model

__all__ = ["ArpaLanguageModel", "NativeArpaLanguageModel", "load_language_model"]
