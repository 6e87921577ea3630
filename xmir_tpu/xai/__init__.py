from .sbsm import (
    generate_masks,
    sbsm_pair_saliency,
    sbsm_pair_saliency_mesh,
    sbsm_self_saliency,
    sbsm_self_saliency_mesh,
)
from .simatt import simatt_saliency
from .simcam import (
    point_specific_map,
    simcam_decomposition,
    simcam_maps,
    simcam_vit_maps,
)
from .rollout import attention_rollout, rollout_saliency
from .causal import (
    blur_substrate,
    causal_scores,
    run_causal_metric,
    saliency_rank,
    zeros_substrate,
)
from .feature_heads import get_feature_head
from .variants import (
    ProbeClassifier,
    fsal_grad_saliency,
    fsal_saliency,
    gaussian_blur_normed,
    sbsm_feature_saliency,
    sbsm_masked_query_saliency,
    sim_score_cam,
    transform_query,
)
from .causal import (
    auto_batch_steps,
    causal_scores_batch,
    causal_scores_batch_mesh,
    run_causal_metric_pairs,
    run_causal_metric_pairs_both,
)
from .gradcam_sim import make_vit_gradcam_fn, vit_gradcam_similarity
from .conceptxai import (
    attention_heatmap,
    detect_patch_grid,
    explain_retrieval,
    patch_concept_attention,
    text_explanation,
)
