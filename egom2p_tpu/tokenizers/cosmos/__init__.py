from .network import (CausalContinuousVideoTokenizer,
                      CausalDiscreteVideoTokenizer, ContinuousVideoConfig,
                      CV8x8x8_CONFIG, DV4x8x8_CONFIG, DV8x16x16_CONFIG,
                      DiscreteVideoConfig)
from .image_network import (CI_CONFIG, ContinuousImageTokenizer, DI_CONFIG,
                            DiscreteImageTokenizer, ImageTokenizerConfig)
from .image_api import ImageTokenizer
from .video_api import CausalVideoTokenizer, ContinuousVideoTokenizer
