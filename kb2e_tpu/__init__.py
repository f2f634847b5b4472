"""kb2e_tpu: a TPU-native knowledge-graph embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
eriq-augustine/KB2E (TransE / TransH / TransR / CTransR training and filtered
link-prediction evaluation), built for single-chip through multi-host TPU
deployment.  See SURVEY.md at the repo root for the reference blueprint.
"""

__version__ = "0.1.0"

from kb2e_tpu.config import EmbeddingConfig  # noqa: F401
from kb2e_tpu.constants import Distance, Method  # noqa: F401
