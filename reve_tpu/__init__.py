"""reve_tpu — a TPU-native video upscaling framework.

A from-scratch rebuild of the capabilities of ONdraid/reve (Real-ESRGAN Video
Enhance): segment-based video upscaling with overlapping decode / inference /
encode stages and segment-granularity resume — but with the inference engine
running *in process* on TPU via JAX/XLA/Pallas instead of shelling out to
`realesrgan-ncnn-vulkan`, and frames moving through memory instead of PNG
files on disk.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

    CLI / web service                 reve_tpu.cli / reve_tpu.service
      └─ pipeline scheduler           reve_tpu.pipeline.scheduler
           ├─ planner + resume        reve_tpu.pipeline.{planner,state}
           │    (native C++ core      reve_tpu._native, via ctypes)
           ├─ io backends             reve_tpu.io.{probe,reader,writer,concat}
           └─ TPU inference engine    reve_tpu.pipeline.engine
                ├─ models             reve_tpu.models.{srvgg,rrdb}
                ├─ ops                reve_tpu.ops.{color,pixel_shuffle,tiling,s2d}
                └─ parallel           reve_tpu.parallel.{mesh,sharding}
"""

from reve_tpu.version import __version__

__all__ = ["__version__", "upscale_video", "upscale_image"]


def __getattr__(name):
    # lazy: keep `import reve_tpu` free of jax/cv2 imports
    if name in ("upscale_video", "upscale_image"):
        from reve_tpu import api

        return getattr(api, name)
    raise AttributeError(name)
