class SimulationManager:
    """Leader braking cycle: drives at 8 m/s, brakes to a stop at
    t = 10 s, reaccelerates at t = 22 s.  Finish after 38.0 s."""

    def __init__(self, sim):
        pass

    def update(self, sim):
        if not sim.cars:
            return
        lead = sim.cars[0]
        if sim.t < 10.0:
            lead.target_v = 8.0
        elif sim.t < 22.0:
            lead.target_v = 0.0
        else:
            lead.target_v = 8.0
        if sim.t > 38.0:
            sim.finished = True
