from .seq_vqvae import SeqAutoencoder, SeqTokenizer, seq_vqvae_from_config
