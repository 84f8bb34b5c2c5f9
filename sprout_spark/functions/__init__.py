"""Column-function library: text analysis for training-data pipelines."""

from .text import (
    bpe_ish_token_count,
    document_fingerprints,
    document_fingerprints_portable,
    language_id,
    quality_score,
    with_text_stats,
    ws_token_count,
)
