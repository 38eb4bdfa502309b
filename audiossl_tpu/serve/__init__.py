"""Serving: AOT-exported (StableHLO) inference artifacts for trained encoders."""
from audiossl_tpu.serve.export import (  # noqa: F401
    ServingEncoder,
    export_embedder,
    load_artifact,
    save_artifact,
)
