from swat_tpu.models.configs import (
    CLIPConfig,
    VisionConfig,
    TextConfig,
    MODEL_REGISTRY,
    get_model_config,
)
from swat_tpu.models.clip import CLIPModel, encode_image, encode_text
from swat_tpu.models.head import (
    init_head_from_prompts,
    init_head_random,
    head_logits,
)
