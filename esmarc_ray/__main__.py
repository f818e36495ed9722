from esmarc_ray.cli import run

raise SystemExit(run())
