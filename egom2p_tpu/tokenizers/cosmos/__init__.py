from .network import CausalDiscreteVideoTokenizer, DV4x8x8_CONFIG, DiscreteVideoConfig
from .video_api import CausalVideoTokenizer
