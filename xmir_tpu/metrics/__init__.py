from .retrieval import (
    pairwise_cosine,
    pairwise_neg_l2,
    fill_diagonal_neg_inf,
    retrieval_recall_at_k,
    compute_ap,
    compute_map,
    majority_vote,
    compute_classification_metrics,
    jaccard_matrix,
    compute_map_multilabel,
    multilabel_precision_recall_at_k,
    train_eval_single_label,
    train_eval_multilabel,
)
from .saliency import auc, clip_scores, saliency_quality
from .anomaly import get_measures, fpr_at_recall
