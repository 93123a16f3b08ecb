"""CLI entry point: `python run_vidtome.py --config configs/<name>.yaml`
(same interface as the reference run_vidtome.py)."""

from vidtome_tpu.cli import main

if __name__ == "__main__":
    main()
