"""Per-model main, analogue of the reference binary evalTransh
(see e.g. transe/bin/evalTransE.cpp:9-18)."""
from kb2e_tpu.cli import eval as eval_cli

def main(argv=None):
    eval_cli.main(argv, model_name="transh")

if __name__ == "__main__":
    main()
