# Native kernels (normally built on first import; this forces a rebuild).
CXX ?= g++
CXXFLAGS ?= -O3 -fopenmp -shared -fPIC

NATIVE = native/slic/libslic.so native/datacore/libdatacore.so

all: native

native: $(NATIVE)

native/slic/libslic.so: native/slic/slic.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

native/datacore/libdatacore.so: native/datacore/datacore.cpp
	$(CXX) $(CXXFLAGS) $< -o $@ -ljpeg

test:
	python -m pytest tests/ -x -q

clean:
	rm -f $(NATIVE)

.PHONY: all native test clean
