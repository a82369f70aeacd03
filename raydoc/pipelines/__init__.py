from raydoc.pipelines.extract_pipeline import (  # noqa: F401
    extract_dataset,
    run_extract_pipeline,
)
