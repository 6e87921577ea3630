from .checkpoint import (
    BestCheckpointPolicy,
    checkpoint_name,
    load_checkpoint,
    merge_params,
    save_checkpoint,
)
from .profiling import dump_spans, reset_spans, span, span_report, trace
