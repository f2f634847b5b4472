from kb2e_tpu.data.triples import Dataset, TripleSet, load_dataset  # noqa: F401
