from .wordscore import word_score

__all__ = ["word_score"]
