class SimulationManager:
    """Finish the scenario after 45.0 simulated seconds."""

    def __init__(self, sim):
        pass

    def update(self, sim):
        if sim.t > 45.0:
            sim.finished = True
