.PHONY: all native test bench clean

all: native

native: build/libyt8m_io.so

build/libyt8m_io.so: cpp/yt8m_io.cc
	mkdir -p build
	g++ -O3 -march=native -shared -fPIC -o $@ $<

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf build __pycache__ .jax_cache
