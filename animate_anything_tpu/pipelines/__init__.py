from animate_anything_tpu.pipelines.latent2video import LatentToVideoPipeline

__all__ = ["LatentToVideoPipeline"]
