"""Scoring configuration with the reference's default values frozen.

Reference: include/search_engine/scoring/SearchScorer.h:20-61 and the
presets in src/scoring/SearchScorer.cpp:16-47. JSON load mirrors the
hot-reloadable Scorer config (src/search_core/Scorer.cpp:10-75).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict


@dataclass
class FieldWeights:
    title: float = 5.0
    description: float = 3.0
    content: float = 1.0
    keywords: float = 4.0
    url: float = 0.5
    domain: float = 0.8

    def get(self, name: str) -> float:
        return getattr(self, name, 1.0)


@dataclass
class TFParams:
    use_log_normalization: bool = True   # log(1 + tf)
    max_term_frequency: float = 10.0
    normalize_by_length: bool = True


@dataclass
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


@dataclass
class BoostFactors:
    exact_match_boost: float = 2.0
    title_match_boost: float = 1.5
    domain_authority_boost: float = 1.2
    freshness_boost: float = 1.1


# Hardcoded authority domains (src/scoring/SearchScorer.cpp:502-525).
AUTHORITY_DOMAINS = frozenset({"github.com", "stackoverflow.com"})


@dataclass
class ScoringConfig:
    field_weights: FieldWeights = field(default_factory=FieldWeights)
    tf_params: TFParams = field(default_factory=TFParams)
    bm25_params: BM25Params = field(default_factory=BM25Params)
    boost_factors: BoostFactors = field(default_factory=BoostFactors)
    min_score: float = 0.01
    normalize_scores: bool = True
    # Config-surface parity with the hot-reloadable Scorer config
    # (src/search_core/Scorer.cpp:10-75, Scorer.hpp:11): the reference
    # loads/defaults offset_boost=0.1 but never applies it in scoring
    # (ranking is delegated to RediSearch SCORER TFIDF). Kept here so a
    # reference scorer JSON round-trips losslessly.
    offset_boost: float = 0.1

    # -- presets (SearchScorer.cpp:16-47) --------------------------------
    @staticmethod
    def create_default() -> "ScoringConfig":
        return ScoringConfig()

    @staticmethod
    def create_title_heavy() -> "ScoringConfig":
        c = ScoringConfig()
        c.field_weights.title = 10.0
        c.field_weights.description = 2.0
        c.field_weights.content = 0.5
        c.boost_factors.title_match_boost = 2.0
        return c

    @staticmethod
    def create_content_heavy() -> "ScoringConfig":
        c = ScoringConfig()
        c.field_weights.title = 3.0
        c.field_weights.content = 2.0
        c.field_weights.description = 1.5
        c.tf_params.max_term_frequency = 20.0
        return c

    @staticmethod
    def create_balanced() -> "ScoringConfig":
        c = ScoringConfig()
        c.field_weights.title = 3.0
        c.field_weights.description = 2.0
        c.field_weights.content = 1.5
        c.field_weights.keywords = 2.5
        c.boost_factors.exact_match_boost = 1.5
        c.boost_factors.title_match_boost = 1.2
        return c

    # -- (de)serialization ----------------------------------------------
    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "ScoringConfig":
        d = json.loads(s)
        return ScoringConfig(
            field_weights=FieldWeights(**d.get("field_weights", {})),
            tf_params=TFParams(**d.get("tf_params", {})),
            bm25_params=BM25Params(**d.get("bm25_params", {})),
            boost_factors=BoostFactors(**d.get("boost_factors", {})),
            min_score=d.get("min_score", 0.01),
            normalize_scores=d.get("normalize_scores", True),
            offset_boost=d.get("offset_boost", 0.1),
        )
