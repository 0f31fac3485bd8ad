from .matmul_int8 import int8_matmul_requant
from .attention_lis import lis_attention
