from .feature_vqvae import (FeatureAutoencoder, FeatureVQTokenizer,
                            feature_vqvae_from_config)
from .seq_vqvae import SeqAutoencoder, SeqTokenizer, seq_vqvae_from_config
from .video_vqvae import (VideoAutoencoder, VideoVQTokenizer,
                          video_vqvae_from_config)
