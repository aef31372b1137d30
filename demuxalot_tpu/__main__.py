"""``python -m demuxalot_tpu`` — see cli.py for the subcommands."""
from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
