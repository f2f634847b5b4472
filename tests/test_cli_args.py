"""CLI flag surface: reference flag names/defaults parse into the config.

The reference accepts `-flag` or `--flag` (common/utils.cpp:55-68) with the
names/defaults of common/constants.h:28-54; the TPU-native extensions ride
the same parser.
"""

from kb2e_tpu import constants as C
from kb2e_tpu.cli import common as cli_common


def _parse(argv):
    p = cli_common.build_parser("train_transe", "test")
    return cli_common.config_from_args(p.parse_args(argv))


def test_reference_defaults():
    cfg = _parse([])
    assert cfg.embedding_size == C.DEFAULT_EMBEDDING_SIZE
    assert cfg.learning_rate == C.DEFAULT_LEARNING_RATE
    assert cfg.margin == C.DEFAULT_MARGIN
    assert cfg.method == C.DEFAULT_METHOD
    assert cfg.num_batches == C.DEFAULT_NUM_BATCHES
    assert cfg.max_epochs == C.DEFAULT_MAX_EPOCHS
    assert cfg.distance == C.DEFAULT_DISTANCE
    assert cfg.num_negatives == 1  # reference policy


def test_reference_flags_single_and_double_dash():
    cfg = _parse(["--size", "64", "-rate", "0.01", "--method", "0",
                  "-distance", "1", "--seed", "9"])
    assert cfg.embedding_size == 64
    assert cfg.learning_rate == 0.01
    assert cfg.method == C.Method.UNIF
    assert cfg.distance == C.Distance.L2
    assert cfg.seed == 9


def test_method_accepts_names_and_ids():
    assert _parse(["--method", "bern"]).method == C.Method.BERN
    assert _parse(["--method", "1"]).method == C.Method.BERN
    assert _parse(["--method", "unif"]).method == C.Method.UNIF


def test_tpu_native_extension_flags():
    cfg = _parse(["--negatives", "8", "--update-mode", "parity",
                  "--data-axis", "4", "--model-axis", "2"])
    assert cfg.num_negatives == 8
    assert cfg.update_mode == "parity"
    assert cfg.data_axis == 4 and cfg.model_axis == 2
