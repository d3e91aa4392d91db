"""textgraphs_ray — a Ray-Data-native record-linkage / entity-resolution
engine with the query and data-processing capabilities of
DerwenAI/textgraphs, rebuilt from scratch on ``ray.data.Dataset``
pipelines (see SURVEY.md for the reference→engine mapping).

Public API mirrors the reference's exported surface
(``/root/reference/textgraphs/__init__.py``): utility UDFs, the KG
mapping tables, the pipeline entry points, and the extension registry.
"""

from .corpus import generate as generate_corpus
from .corpus import write_corpus
from .evaluate import er_f1_against_truth, pairwise_scores
from .functions.kg import (NER_MAP, NS_PREFIX, normalize_prefix, remap_ner)
from .functions.nlp import (lemma_key_single, lemma_key_tokens, lemma_of,
                            parse, pos_of)
from .functions.sketch import (band_keys, char_shingles, jaccard_shingles,
                               minhash_batch, shingle_embedding_batch,
                               simhash_batch)
from .functions.strsim import (jaro_winkler, jaro_winkler_batch,
                               levenshtein_batch, levenshtein_sim_batch,
                               osa_distance, osa_within)
from .pipelines.er import (extract_spans, mentions_from_spans,
                           resolve_entities, spanify_text)
from .pipelines.curate import curate_corpus
from .pipelines.er_incremental import resolve_entities_incremental
from .pipelines.er_resume import resolve_entities_checkpointed
from .pipelines.full import analyze
from .pipelines.gor import affinity_scores, load_ingram
from .pipelines.phrases import ranked_phrases
from .registry import (register_extractor, register_linker, register_scorer,
                       registry)
from .stages.dedup import (embedding_dedup, exact_dedup, minhash_dedup,
                           ngram_jaccard_dedup, simhash_dedup)
from .stages.rank import (calc_quantile_bins, root_mean_square,
                          solve_restack_coeffs, stripe_column)
from .stages.similarity import knn_brute, knn_ivf, knn_lsh

__version__ = "0.1.0"

__all__ = [
    "NER_MAP", "NS_PREFIX", "affinity_scores", "analyze", "band_keys",
    "calc_quantile_bins", "char_shingles", "curate_corpus",
    "embedding_dedup",
    "er_f1_against_truth", "exact_dedup", "extract_spans",
    "generate_corpus", "jaccard_shingles", "jaro_winkler",
    "jaro_winkler_batch", "knn_brute", "knn_ivf", "knn_lsh",
    "lemma_key_single", "lemma_key_tokens",
    "lemma_of", "levenshtein_batch", "levenshtein_sim_batch",
    "load_ingram", "mentions_from_spans", "minhash_batch",
    "minhash_dedup", "ngram_jaccard_dedup", "normalize_prefix",
    "osa_distance", "osa_within", "pairwise_scores", "parse", "pos_of",
    "ranked_phrases",
    "register_extractor", "register_linker", "register_scorer",
    "registry", "remap_ner", "resolve_entities",
    "resolve_entities_checkpointed", "resolve_entities_incremental",
    "root_mean_square",
    "shingle_embedding_batch", "simhash_batch", "simhash_dedup",
    "solve_restack_coeffs",
    "spanify_text", "stripe_column", "write_corpus",
]
