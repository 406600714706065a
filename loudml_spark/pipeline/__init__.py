from loudml_spark.pipeline.text import text_stats, langid  # noqa: F401
from loudml_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    embedding_cosine_pairs,
)
from loudml_spark.pipeline.similarity import cosine_topk  # noqa: F401
from loudml_spark.pipeline.linkage import (  # noqa: F401
    fuzzy_join,
    fuzzy_self_pairs,
)
from loudml_spark.pipeline.corpus import (  # noqa: F401
    bm25_scores,
    cooccurrence_edges,
    importance_weights,
    lm_perplexity,
    pmi_pairs,
    sparse_cosine_pairs,
    textrank_keywords,
)
from loudml_spark.pipeline.embeddings import (  # noqa: F401
    embedding_covariance,
    embedding_outlier_scores,
    pca_fit,
    pca_project,
)
