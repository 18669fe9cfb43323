"""North-star operator library (SURVEY.md §2.10 + custom operators)."""
from .asof import asof_join
from .dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_best_match,
    ngram_jaccard_pairs,
    simhash,
)
from .dedup import incremental_dedup
from .graph_algo import connected_components, dedup_clusters, pagerank, tree_paths
from .intervals import point_in_interval_join
from .layout import write_bucketed, zvalue
from .multimodal import binarize, extract_features
from .quality import Check, constraint_audit
from .similarity import ann_lsh, cosine_topk, cosine_topk_np
from .skew import salted_join, salted_two_phase_agg, skew_profile
from .timeseries import forward_fill, resample_linear, scd2_compress
from .text import fingerprint, lang_id, quality_score, text_stats, token_count, word_shingles
from .windows import sessionize, sliding, tumbling

__all__ = [
    "asof_join",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "ngram_jaccard_best_match",
    "minhash_lsh_dedup",
    "simhash",
    "embedding_near_dup",
    "connected_components",
    "dedup_clusters",
    "binarize",
    "extract_features",
    "cosine_topk",
    "cosine_topk_np",
    "ann_lsh",
    "salted_join",
    "salted_two_phase_agg",
    "fingerprint",
    "lang_id",
    "quality_score",
    "text_stats",
    "token_count",
    "word_shingles",
    "sessionize",
    "sliding",
    "tumbling",
    "incremental_dedup",
    "pagerank",
    "tree_paths",
    "point_in_interval_join",
    "write_bucketed",
    "zvalue",
    "Check",
    "constraint_audit",
    "skew_profile",
    "forward_fill",
    "resample_linear",
    "scd2_compress",
]
