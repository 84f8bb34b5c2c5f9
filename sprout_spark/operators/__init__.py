"""Training-data pipeline operators: dedup, similarity, multimodal."""

from .dedup import (
    exact_dedup,
    exact_jaccard_pairs,
    lsh_candidate_pairs,
    minhash_band_rows,
    near_dup_pairs,
    simhash_near_dup_pairs,
    simhash_signatures,
    token_sets,
    verify_jaccard,
)
from .similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    srp_signatures,
    with_cosine,
)
