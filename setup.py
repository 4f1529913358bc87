from setuptools import find_packages, setup

setup(
    name="tpumix",
    version="0.1.0",
    description="TPU-native automatic multitrack mixing framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
)
