"""Per-model main, analogue of the reference binary trainCtransr
(see e.g. transe/bin/trainTransE.cpp:9-20)."""
from kb2e_tpu.cli import train

def main(argv=None):
    train.main(argv, model_name="ctransr")

if __name__ == "__main__":
    main()
