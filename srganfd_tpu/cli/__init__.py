"""Entry points: train / test / infer / prepare_dataset."""
