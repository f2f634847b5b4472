"""Per-model main, analogue of the reference binary trainTranse
(see e.g. transe/bin/trainTransE.cpp:9-20)."""
from kb2e_tpu.cli import train

def main(argv=None):
    train.main(argv, model_name="transe")

if __name__ == "__main__":
    main()
