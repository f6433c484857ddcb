from .config import ScoringConfig, FieldWeights, BM25Params, TFParams, BoostFactors

__all__ = ["ScoringConfig", "FieldWeights", "BM25Params", "TFParams", "BoostFactors"]
