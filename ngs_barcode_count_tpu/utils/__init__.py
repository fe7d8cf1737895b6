"""Host utilities: simulation, formatting, timing."""
