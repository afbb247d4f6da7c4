# Common targets (all dependencies are baked into the image; see
# requirements.txt)

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

demo:
	python examples/inpaint_synthetic_scene.py

dryrun:
	python __graft_entry__.py

native:
	g++ -O3 -shared -fPIC -std=c++17 \
	    stinet_tpu/preprocessing/native/decimator.cpp \
	    -o stinet_tpu/preprocessing/native/libdecimator.so
	g++ -O3 -shared -fPIC -std=c++17 \
	    stinet_tpu/graph/native/graph_builder.cpp \
	    -o stinet_tpu/graph/native/libgraph_builder.so

.PHONY: test test-fast bench demo dryrun native
