"""`python -m pbrt_tpu` entry point (reference: src/main.rs CLI)."""
from pbrt_tpu.main import main

if __name__ == "__main__":
    main()
