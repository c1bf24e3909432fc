from .velocloud import PipelineOutput, run_pipeline

__all__ = ["PipelineOutput", "run_pipeline"]
