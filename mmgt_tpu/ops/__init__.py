from mmgt_tpu.ops.attention import dot_product_attention
from mmgt_tpu.ops.norms import group_norm, layer_norm
