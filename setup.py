"""Packaging (reference setup.py:1-15 packages carle/tests/evaluation).

The native codecs (carle_tpu/native: RLE + GIF LZW) are built separately
via ``make -C carle_tpu/native`` (ctypes, no build-time Python dependency);
the package works without them (pure-Python fallbacks in rle.py/utils/gif.py).
"""

from setuptools import find_packages, setup

setup(
    name="carle_tpu",
    version="0.1.0",
    description=(
        "TPU-native Cellular Automata Reinforcement Learning Environment "
        "(JAX/XLA/Pallas re-design of the capabilities of riveSunder/carle)"
    ),
    packages=find_packages(include=["carle_tpu", "carle_tpu.*", "evaluation"]),
    package_data={"carle_tpu": ["patterns/*.rle", "native/*.so"]},
    install_requires=["jax", "numpy", "optax"],
    python_requires=">=3.10",
)
