from .char_ngram import advance_context, char_ngram_table_from_texts, context_size
from .ngram import ArpaLanguageModel, NativeArpaLanguageModel, load_language_model

__all__ = ["ArpaLanguageModel", "NativeArpaLanguageModel", "load_language_model",
           "char_ngram_table_from_texts", "context_size", "advance_context"]
