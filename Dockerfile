# TPU deployment image (reference ships a CUDA image; this is the TPU one).
# jax[tpu] pulls libtpu for Cloud TPU VMs; the native host kernels build
# with the toolchain below.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make git && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

RUN pip install --no-cache-dir -U pip \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e ".[data,dev]" \
    && ./native/build.sh

# smoke: tokenizer + host kernels import without a TPU attached
RUN JAX_PLATFORMS=cpu python -c "import omr_a2s_multimodal_transformer_tpu as m; print(m.__version__)"

ENTRYPOINT ["python", "-m", "omr_a2s_multimodal_transformer_tpu.cli.train"]
