from .slic import slic_segment
from .superpixel import superpixel_attention_mask
