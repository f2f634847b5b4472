"""Per-model eval main for PTransE (scores with the TransE energy over the
path-informed embeddings)."""
from kb2e_tpu.cli import eval as eval_cli

def main(argv=None):
    eval_cli.main(argv, model_name="ptranse")

if __name__ == "__main__":
    main()
