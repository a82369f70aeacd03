from raydoc.stages.extract_stage import ExtractStage, explode_chunks  # noqa: F401
