from .charsets import english_frequent_characters, german_frequent_characters
from .graphemes import (AsgGraphemeCodec, AsgGraphemeEncoding, CtcGraphemeCodec,
                        CtcGraphemeEncoding, GraphemeCodec)
from .metrics import (ExpectationsVsPredictions, ExpectationsVsPredictionsInBatches,
                      ExpectationsVsPredictionsInGroupedBatches, ExpectationVsPrediction,
                      levenshtein)

__all__ = ["english_frequent_characters", "german_frequent_characters", "GraphemeCodec",
           "CtcGraphemeCodec", "AsgGraphemeCodec", "CtcGraphemeEncoding", "AsgGraphemeEncoding",
           "levenshtein", "ExpectationVsPrediction", "ExpectationsVsPredictions",
           "ExpectationsVsPredictionsInBatches", "ExpectationsVsPredictionsInGroupedBatches"]
