from dg_tta_tpu.cli.main import main

main()
