from raydoc.state.manifest import (  # noqa: F401
    committed_partitions,
    load_manifests,
    manifest_dir,
    write_partition_atomic,
)
