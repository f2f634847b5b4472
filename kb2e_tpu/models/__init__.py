from kb2e_tpu.models.base import Batch, Model, Params, get_model  # noqa: F401
