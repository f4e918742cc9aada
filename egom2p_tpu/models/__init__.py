from .egom2p import EgoM2P, create_model, MODEL_REGISTRY
from .hub import FM
