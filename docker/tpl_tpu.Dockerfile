# Reproducible environment for tpl_tpu (the reference pins its stack in
# docker/tpl_base.Dockerfile:1-42; this is the TPU-framework equivalent).
#
# Build:  docker build -f docker/tpl_tpu.Dockerfile -t tpl_tpu .
# Test:   docker run --rm tpl_tpu tools/ci.sh
# TPU:    run on a TPU VM image instead and `pip install -r
#         requirements.lock` into the system python — jax/libtpu pins in
#         the lockfile match TPU v5e.

FROM python:3.12.12-slim-bookworm

# native toolchain for the C++ host modules (built on demand via ctypes
# loader, tpl_tpu/native/__init__.py)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make cmake ninja-build \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/tpl_tpu

# the full frozen package set of the environment this framework is
# developed and benchmarked in (single source of truth: requirements.lock)
COPY requirements.lock .
RUN pip install --no-cache-dir -r requirements.lock

COPY pyproject.toml README.md ./
COPY tpl_tpu ./tpl_tpu
COPY tests ./tests
COPY tools ./tools
COPY data ./data
COPY examples ./examples
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir --no-deps -e .

# headless defaults: CPU backend with a virtual 8-device mesh
ENV JAX_PLATFORMS=cpu \
    MPLBACKEND=Agg

CMD ["python", "-m", "pytest", "tests/", "-q"]
