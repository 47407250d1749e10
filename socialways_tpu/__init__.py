"""socialways_tpu — a TPU-native trajectory-prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
crowdbotp/socialways ("Social Ways: Learning Multi-Modal Distributions of
Pedestrian Trajectories with GANs", CVPRW 2019).  The reference is a
single-GPU PyTorch research script; this package is a pure-functional,
scan-based, mesh-sharded framework:

- ``data``      parsers (BIWI/TrajNet/SDD/Seyfried), Scale, windowing, toy set
- ``ops``       social features, masked attention pooling, fused LSTM
- ``kernels``   Pallas TPU kernels (with XLA fallbacks)
- ``models``    encoder / decoders / discriminator / generator rollout
- ``engine``    jitted unrolled-InfoGAN train step, epoch-on-device trainer
- ``parallel``  device mesh + shard_map data-parallel training
- ``eval``      vmapped K-sample ADE/FDE, constant-velocity baseline, EMD/1-NN
- ``io``        orbax checkpointing, reference-compatible prediction dumps
- ``viz``       heatmap / animation rendering (host-side, offline)
- ``cli``       train / evaluate / create-dataset / create-toy / visualize
"""

__version__ = "0.1.0"

from socialways_tpu.config import TrainConfig  # noqa: F401
