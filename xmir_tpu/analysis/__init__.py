from .ensemble import ensemble_embeddings
from .fusion import (
    EmbeddingSource,
    align_sources,
    concat_fusion,
    confidence_fusion,
    retrieval_metrics_from_scores,
    run_late_fusion_experiments,
    score_fusion,
    weighted_sum_fusion,
)
from .comparison import compare_retrievers, export_comparison, render_mismatch_html
from .anomaly_eval import anomaly_scores, class_centroids, evaluate_anomaly
from .hashing_eval import binarize_codes, hash_retrieval_metrics
from .zeroshot import (
    build_class_prompts,
    concept_profile_embeddings,
    text_rerank_scores,
    zero_shot_classify,
)
from .reports import (
    analyze_insertion_deletion,
    overlay_saliency,
    render_overlays_from_results,
)
