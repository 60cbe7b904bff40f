"""Engine function library — the scalar/array functions the engine adds on
top of pyspark.sql.functions, all Catalyst expressions (codegen, no Python).

The reference's scalar surface is tiny (regex key parse, string format,
JSON encode/decode, charset encode, int32 BE pack — SURVEY §2 Part B);
Catalyst covers those natively. What we export here are the functions the
new engine defines for CDC + training-data work.
"""

from kafka_connect_gcs_spark.operators.dedup_text import (  # noqa: F401
    hamming64,
    jaccard,
    shingles_of_words,
    simhash64,
    word_shingles,
)
from kafka_connect_gcs_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
    norm,
    rp_bucket,
)
from kafka_connect_gcs_spark.operators.text import (  # noqa: F401
    bpe_token_count,
    fingerprint,
    gram_hashes,
    lang_guess,
    mean_word_len,
    minhash_signature_of_words,
    minhash_signature_words,
    punct_ratio,
    quality_score,
    stopword_ratio,
    winnow_from_gram_hashes,
    words,
    ws_token_count,
)
from kafka_connect_gcs_spark.operators.classifier import (  # noqa: F401
    hashed_features,
)
from kafka_connect_gcs_spark.operators.curation import (  # noqa: F401
    word_ngrams,
)
from kafka_connect_gcs_spark.operators.dsir import gumbel_noise  # noqa: F401
from kafka_connect_gcs_spark.operators.normalize import (  # noqa: F401
    collapse_whitespace,
    strip_control_chars,
)
from kafka_connect_gcs_spark.operators.sampling import (  # noqa: F401
    hash_bucket,
    shuffle_key,
)
from kafka_connect_gcs_spark.operators.validate import valid_expr  # noqa: F401

__all__ = [
    "words",
    "ws_token_count",
    "bpe_token_count",
    "punct_ratio",
    "stopword_ratio",
    "mean_word_len",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "minhash_signature_words",
    "minhash_signature_of_words",
    "gram_hashes",
    "winnow_from_gram_hashes",
    "hashed_features",
    "word_ngrams",
    "word_shingles",
    "shingles_of_words",
    "jaccard",
    "simhash64",
    "hamming64",
    "dot",
    "norm",
    "cosine",
    "rp_bucket",
    "hash_bucket",
    "shuffle_key",
    "gumbel_noise",
    "strip_control_chars",
    "collapse_whitespace",
    "valid_expr",
]
