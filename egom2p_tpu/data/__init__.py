from .modality_info import MODALITY_INFO, generate_uint15_hash
