"""Training-data-pipeline operators over the documents/embeddings tables.

These extend the CDC engine with the operations a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing). All hot paths are Catalyst expressions (array/lambda
higher-order functions, sha2, regexp) — no per-row Python; the only Python
is the clearly-stubbed multimodal decode behind mapInPandas.
"""

from debezium_spark.dataops.dedup import (
    decontaminate,
    dedup_against_corpus,
    exact_dedup,
    exact_substring_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from debezium_spark.dataops.pipeline import (
    CorpusDelta,
    PipelineResult,
    apply_corpus_delta,
    corpus_census,
    incremental_corpus_update,
    seed_census,
    training_corpus_pipeline,
)
from debezium_spark.dataops.similarity import (
    brute_force_topk,
    bucketed_ann_topk,
    embedding_near_duplicates,
    lsh_ann_topk,
    random_projection,
    semantic_dedup,
)
from debezium_spark.dataops.packing import pack_sequences
from debezium_spark.dataops.sampling import (
    cap_per_group,
    hash_fraction,
    hash_split,
    sample_by_rate,
    temperature_mix,
)
from debezium_spark.dataops.text import (
    c4_clean,
    doc_fingerprint,
    gopher_doc_filter,
    language_id,
    line_dedup,
    quality_score,
    repetition_stats,
    token_stats,
    unigram_logprob,
)

__all__ = [
    "c4_clean",
    "decontaminate",
    "dedup_against_corpus",
    "exact_dedup",
    "exact_substring_dedup",
    "training_corpus_pipeline",
    "PipelineResult",
    "CorpusDelta",
    "apply_corpus_delta",
    "corpus_census",
    "incremental_corpus_update",
    "seed_census",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "brute_force_topk",
    "bucketed_ann_topk",
    "embedding_near_duplicates",
    "lsh_ann_topk",
    "random_projection",
    "semantic_dedup",
    "line_dedup",
    "doc_fingerprint",
    "gopher_doc_filter",
    "cap_per_group",
    "hash_fraction",
    "hash_split",
    "pack_sequences",
    "sample_by_rate",
    "temperature_mix",
    "unigram_logprob",
    "language_id",
    "quality_score",
    "repetition_stats",
    "token_stats",
]
