from heimdall_tpu.utils import draw
