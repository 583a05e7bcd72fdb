from raytracing_tests_tpu.app.cli import main

main()
