"""Reference-layout CLI entry point (reference main.py): delegates to
ribca_tpu.cli. Usage:

    python main.py --marker-list-path markers.txt --image-path img.tif \
        --mask-path mask.png --batch-id run1 --main-dir ./out
"""

from ribca_tpu.cli import main, run, batch_run, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
