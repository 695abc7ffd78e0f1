from .char_ngram import advance_context, char_ngram_table_from_texts, context_size
from .arpa_builder import WordNgramEstimator, build_kenlm_directory
from .device_lm import DeviceWordLm, build_device_word_lm, score_word_device
from .ngram import ArpaLanguageModel, NativeArpaLanguageModel, load_language_model

__all__ = ["ArpaLanguageModel", "NativeArpaLanguageModel", "load_language_model",
           "char_ngram_table_from_texts", "context_size", "advance_context",
           "WordNgramEstimator", "build_kenlm_directory",
           "DeviceWordLm", "build_device_word_lm", "score_word_device"]
