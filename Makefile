.PHONY: native test bench clean

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread \
		csbsr_tpu/native/surface_distance.cpp \
		-o csbsr_tpu/native/libcsbsr_native.so

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f csbsr_tpu/native/libcsbsr_native.so
