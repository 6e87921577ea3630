from .samplers import (
    PKSampler,
    HardMiningSampler,
    MultiLabelBalancedBatchSampler,
    create_groups,
)
