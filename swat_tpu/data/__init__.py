from swat_tpu.data.registry import NUM_CLASSES_DICT, DATASETS
from swat_tpu.data.splits import read_split, SplitSpec, Sample
from swat_tpu.data.prompts import (
    TEMPLATES,
    make_prompts,
    load_class_metrics,
    encode_prompts,
    class_embedding_matrix,
)
