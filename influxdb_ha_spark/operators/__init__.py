"""LLM-data-pipeline operators (added scope beyond the reference surface —
SURVEY.md §7 / BASELINE.json north star): deduplication, similarity search,
text analysis, multimodal columns. All Spark-first: native column expressions
in the hot path, Pandas UDFs only where semantics demand, every fan-out a
keyed shuffle that survives 1000 executors.
"""

from .hashing import hash64_expr, tokens_expr, shingles_expr  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup, fingerprint_dedup, minhash_signatures, minhash_candidates,
    minhash_near_duplicates, simhash, ngram_jaccard_pairs,
)
from .similarity import brute_force_topk, ivf_topk, cosine_expr  # noqa: F401
from .text import (  # noqa: F401
    language_id, quality_score, text_stats, token_count,
)
from .multimodal import attach_binary_payload, binary_metadata, decode_image_stub  # noqa: F401
