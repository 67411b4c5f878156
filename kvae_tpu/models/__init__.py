from kvae_tpu.models.kvae import KVAE  # noqa: F401
from kvae_tpu.models.vae import VAE, Decoder, Encoder  # noqa: F401
