.PHONY: native test bench clean

native:
	g++ -O3 -fopenmp -shared -fPIC nerf_slam_tpu/native/frameops.cpp \
	    -o nerf_slam_tpu/native/libframeops.so

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f nerf_slam_tpu/native/libframeops.so
	find . -name __pycache__ -type d -exec rm -rf {} +
