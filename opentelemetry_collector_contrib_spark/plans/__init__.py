from .manifest import RunManifest
from .pipeline import PipelineConfig, run_pipeline

__all__ = ["RunManifest", "PipelineConfig", "run_pipeline"]
