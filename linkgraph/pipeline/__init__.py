"""Training-data pipeline operators (beyond-reference, first-class).

Large-scale corpus preparation ops the engine needs at 100 TB alongside
the graph algorithms: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), approximate similarity search, text
analysis (language id, quality, tokens, fingerprints), curation
decisions (hash splits, stratified sampling, repetition scoring,
contamination screening, dedup clustering, PII scrubbing), and
multimodal column plumbing. Everything is DataFrame-first; pandas UDFs appear only
where Catalyst has no vectorized equivalent (SimHash bit packing,
multimodal decode).
"""

from linkgraph.pipeline.text import (
    token_counts,
    quality_scores,
    language_id,
    fingerprints,
)
from linkgraph.pipeline.dedup import (
    exact_duplicates,
    exact_dedup,
    word_shingles,
    minhash_signatures,
    minhash_lsh_duplicates,
    simhash_signatures,
    simhash_duplicates,
    ngram_jaccard_pairs,
)
from linkgraph.pipeline.curation import (
    hash_split,
    mixture_sample,
    pack_sequences,
    stratified_sample,
    repetition_scores,
    contamination_check,
    dedup_clusters,
    deduplicate,
    pii_scrub,
)
from linkgraph.pipeline.similarity import (
    with_cosine,
    cosine_topk,
    lsh_ann_topk,
    ivf_ann_topk,
    ivf_assign,
    ivf_lloyd_refine,
    embedding_near_duplicates,
)

__all__ = [
    "token_counts",
    "quality_scores",
    "language_id",
    "fingerprints",
    "exact_duplicates",
    "exact_dedup",
    "word_shingles",
    "minhash_signatures",
    "minhash_lsh_duplicates",
    "simhash_signatures",
    "simhash_duplicates",
    "ngram_jaccard_pairs",
    "hash_split",
    "mixture_sample",
    "pack_sequences",
    "stratified_sample",
    "repetition_scores",
    "contamination_check",
    "dedup_clusters",
    "deduplicate",
    "pii_scrub",
    "with_cosine",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "ivf_assign",
    "ivf_lloyd_refine",
    "embedding_near_duplicates",
]
