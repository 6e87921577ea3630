from .samplers import (
    PKSampler,
    HardMiningSampler,
    MultiLabelBalancedBatchSampler,
    create_groups,
)
from .datasets import (
    CovidxDataset,
    ISICDataset,
    TBX11kDataset,
    VinDrDataset,
    VinDrConceptCLIPDataset,
    NIHChestXrayRetrievalDataset,
    split_txt,
    split_csv,
    COVIDX_LABEL_MAP,
    NIH_RETRIEVAL_PATHOLOGIES,
    VINDR_ALL_COLUMNS,
    VINDR_CONCEPT_COLUMNS,
    VINDR_DISEASE_COLUMNS,
)
from .synthetic import (
    SyntheticImageDataset,
    SyntheticMultiLabelDataset,
    write_synthetic_covidx,
)
from .transforms import eval_preprocess, train_preprocess, preprocess_for_spec
from .pipeline import batch_iterator, embed_dataset, prefetch_to_device
from .tokenizer import HashWordTokenizer
from .wordpiece import BertWordPieceTokenizer, build_text_tokenizer
