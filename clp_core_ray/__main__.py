"""`python -m clp_core_ray …` — see clp_core_ray/cli.py."""
from clp_core_ray.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
