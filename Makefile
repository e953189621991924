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

# fast correctness tier (<5 min on a healthy rig): one jitted step per
# family, one reference-parity file per suite, CLI surface.  For degraded
# rigs where the full 45-60 min suite is infeasible (VERDICT r3 #2).
smoke:
	python -m pytest tests/ -m smoke -x -q

# one-command synthetic CV sweep: all five BASELINE configs through the
# real CLIs (teacher -> export -> student handoffs included) + patient-level
# aggregation; writes SWEEP_REPORT.md.  FOLDS=15 reproduces the reference's
# 15-fold protocol shape.
FOLDS ?= 3
sweep_synthetic:
	MML_PLATFORM=cpu python -m multimodal_learning_tpu.cli.sweep \
	  --folds $(FOLDS) --out_dir /tmp/mml_sweep --report SWEEP_REPORT.md

clean:
	rm -f $(NATIVE)

.PHONY: all native test smoke sweep_synthetic clean
