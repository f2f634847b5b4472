"""Per-model main for PTransE (path-based TransE; the reference fork's README
reports PTransE numbers at README.md:26-29 but ships no code — survey §0.1)."""
from kb2e_tpu.cli import train

def main(argv=None):
    train.main(argv, model_name="ptranse")

if __name__ == "__main__":
    main()
