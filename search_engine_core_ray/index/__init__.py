from .codec import (
    varbyte_encode, varbyte_decode, delta_encode_sorted, delta_decode,
    pfor_encode, pfor_decode, ef_encode, ef_decode,
)
from .stats import CorpusStats, compute_corpus_stats

__all__ = [
    "varbyte_encode",
    "varbyte_decode",
    "delta_encode_sorted",
    "delta_decode",
    "pfor_encode",
    "pfor_decode",
    "ef_encode",
    "ef_decode",
    "CorpusStats",
    "compute_corpus_stats",
]
