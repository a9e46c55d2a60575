"""gencomm_tpu — TPU-native heterogeneous collaborative 3D perception.

A JAX/XLA/Pallas rebuild of the GenComm (NeurIPS 2025) capability set:
multi-agent V2X collaborative detection with LiDAR/camera BEV encoders,
intermediate fusion families, and diffusion-based generative message passing.
"""

__version__ = "0.1.0"
