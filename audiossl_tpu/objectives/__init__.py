"""SSL objective registry. Importing this package registers all objectives."""
from audiossl_tpu.objectives.api import LossAux, available, get_objective, register  # noqa: F401
from audiossl_tpu.objectives import delores_s, delores_m, slicer, unfused  # noqa: F401

try:  # objectives with heavier deps register if importable
    from audiossl_tpu.objectives import decar  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from audiossl_tpu.objectives import ssmast  # noqa: F401
except ImportError:  # pragma: no cover
    pass
