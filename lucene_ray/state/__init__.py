from .manifest import IndexManifest, load_manifest  # noqa: F401
