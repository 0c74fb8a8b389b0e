"""ModemFarm — placeholder, implemented after the demod kernel."""

ModemFarm = None
