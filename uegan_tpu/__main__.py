from uegan_tpu.cli import run

run()
