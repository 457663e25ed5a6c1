"""Thin CLI entry points over the library.

The reference's entry points are edit-the-Config-block scripts with a
single raw ``--sweep`` flag (train_advanced.py:748-757, USAGE.md:105-129).
Here every command takes ``--preset``, ``--config <json>``, and repeated
``--set dotted.path=value`` overrides into the typed config tree:

    python -m vit_spoof_detection_pda_tpu train --preset advanced-train \
        --set optim.learning_rate=1e-5 --set data.data_root=/data/aug

Commands: augment, train, test, evaluate-all, analyze, benchmark.
"""
