# vitsom-tpu container (reference parity: /root/reference/Dockerfile builds a
# torch+CUDA image; this is the TPU-native equivalent on the JAX TPU base).
#
# Build:  docker build -t vitsom-tpu .
# Run:    docker run --privileged --net=host vitsom-tpu \
#             make train model=vit_som dataset=mnist
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy pyyaml \
    scikit-learn matplotlib seaborn pillow h5py tensorboard pytest

COPY . /workspace

ENV PYTHONPATH=/workspace
CMD ["make", "unit-test"]
