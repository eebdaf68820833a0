from .dedup import (
    containment_for_pairs,
    duplicate_components,
    exact_duplicates,
    jaccard_for_pairs,
    lsh_candidate_pairs,
    lsh_params,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    pick_canonicals,
    shingle_df,
    simhash,
    simhash_near_pairs,
)
from .multimodal import attach_binary, decode_media, sample_frames
from .similarity import (
    AnnIndex,
    IvfIndex,
    ann_add_vectors,
    ann_knn_join,
    ann_candidates,
    ann_query,
    build_ann_index,
    build_ivf_index,
    compact_vector_index,
    delete_vectors,
    ivf_add_vectors,
    ivf_knn_join,
    ivfpq_add_vectors,
    load_ann_index,
    load_ivf_index,
    cosine_topk,
    cosine_topk_arrow,
    lsh_ann_topk,
    train_ivf_centroids,
)
from .chunking import (
    chunk_documents,
    pack_sequences,
    sample_token_budget,
    sample_token_budget_exact,
)
from .pipeline import (corpus_report, dedup_paragraphs, prepare_corpus,
                       remove_boilerplate_lines)
from .trigram import (
    TrigramIndex,
    add_documents,
    build_trigram_index,
    compact_trigram_index,
    delete_documents,
    like_search,
    load_trigram_index,
    pattern_trigrams,
    regex_search,
    similarity_col,
    similarity_join,
    similarity_topk,
    substring_search,
    suggest_terms,
    suggest_terms_multi,
    text_trigrams,
    trigrams_col,
)
from .textstats import (corpus_profile, doc_fingerprint, lang_id,
                        quality_score, token_counts)
from .collocations import (doc_keywords, doc_keywords_indexed,
                           pmi_collocations)
from .lm import bigram_lm_score, train_bigram_lm
from .decontaminate import (
    attach_decontaminator,
    contamination_report,
    decontaminate,
    ngram_hash_df,
)
