# Heimdall TPU — serving image.
# Two-stage build: compile the native runtime, then ship a slim runtime
# with the dashboard (port 59858), results viewer (52829) and Prometheus
# metrics (/metrics on the dashboard port).
FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*
WORKDIR /src
COPY native/ native/
RUN make -C native

FROM python:3.12-slim
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir "jax[cpu]"
RUN pip install --no-cache-dir flax optax orbax-checkpoint \
    opencv-python-headless numpy pyyaml scipy
WORKDIR /app
COPY heimdall_tpu/ heimdall_tpu/
COPY --from=build /src/native/libheimdall_native.so native/
EXPOSE 59858 52829
CMD ["python", "-m", "heimdall_tpu.serving.dashboard", "--autostart"]
