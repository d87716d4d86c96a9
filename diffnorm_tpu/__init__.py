"""diffnorm_tpu — a TPU-native (JAX/XLA/Pallas) speech-to-speech translation framework.

Re-implements the capabilities of DiffNorm (steventan0110/DiffNorm, a fairseq fork):

* mHuBERT feature extraction + k-means unit quantization
* Speech VAE (WaveNet encoder/decoder + Transformer head) over 768-d speech features
* Latent DDPM "normalizer" with DDIM partial-noise denoising of VAE latents
* Non-autoregressive CMLM speech-to-unit translation (Conformer encoder + NAT
  unit decoder, mask-predict iterative refinement, classifier-free guidance)
* code-HiFi-GAN unit-to-waveform synthesis and ASR-BLEU evaluation tooling

Design is TPU-first: flax modules, functional train steps under jit, sampling
loops as lax.scan/while_loop, data/model parallelism via jax.sharding.Mesh +
NamedSharding, host-side data pipeline with length-bucketed batching.
"""

__version__ = "0.1.0"

from diffnorm_tpu import registry  # noqa: F401
