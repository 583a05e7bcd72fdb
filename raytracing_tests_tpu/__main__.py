from raytracing_tests_tpu.app.cli import main

if __name__ == "__main__":
    main()
