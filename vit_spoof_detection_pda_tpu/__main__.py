"""Dispatcher: ``python -m vit_spoof_detection_pda_tpu <command> ...``"""

import sys

COMMANDS = {
    "augment": "vit_spoof_detection_pda_tpu.cli.augment",
    "train": "vit_spoof_detection_pda_tpu.cli.train",
    "test": "vit_spoof_detection_pda_tpu.cli.test",
    "evaluate-all": "vit_spoof_detection_pda_tpu.cli.evaluate_all",
    "analyze": "vit_spoof_detection_pda_tpu.cli.analyze",
    "benchmark": "vit_spoof_detection_pda_tpu.cli.benchmark",
    "export": "vit_spoof_detection_pda_tpu.cli.export",
    "export-serving": "vit_spoof_detection_pda_tpu.cli.export_serving",
    "predict": "vit_spoof_detection_pda_tpu.cli.predict",
    "serve": "vit_spoof_detection_pda_tpu.cli.serve",
    "serve-bench": "vit_spoof_detection_pda_tpu.cli.serve_bench",
    "describe": "vit_spoof_detection_pda_tpu.cli.describe",
    "config": "vit_spoof_detection_pda_tpu.cli.config_cmd",
    "doctor": "vit_spoof_detection_pda_tpu.cli.doctor",
    "demo": "vit_spoof_detection_pda_tpu.cli.demo",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m vit_spoof_detection_pda_tpu "
              f"{{{','.join(COMMANDS)}}} [options]")
        print(__doc__)
        return 0 if len(sys.argv) >= 2 else 1
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; choose from {list(COMMANDS)}")
        return 1
    import importlib

    mod = importlib.import_module(COMMANDS[cmd])
    mod.main(sys.argv[2:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
