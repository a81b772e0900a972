from .vae import Encoder, Decoder, VariationalAutoencoder, DualBranchVAE
from .unet import UNet

__all__ = ["Encoder", "Decoder", "VariationalAutoencoder", "DualBranchVAE", "UNet"]
