from raydoc.state.manifest import (  # noqa: F401
    commit_manifest,
    committed_partitions,
    compact_manifests,
    load_manifests,
    manifest_dir,
    manifest_path,
    write_partition_atomic,
)
