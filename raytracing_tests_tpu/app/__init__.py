"""Application layer: CLI entry, config, checkpointing.

The TPU-native replacement for the reference's GLCore Application + ImGui
dockspace (``GLCore/Core/Application.cpp``, ``TestsLayerManager.cpp``): a
headless CLI that lists/runs workloads, writes PNG/NPY outputs instead of
blitting to framebuffers, and drives the inverse-rendering training loop.
"""
