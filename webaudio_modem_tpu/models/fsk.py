"""FSKCore — placeholder, implemented after the demod kernel."""

FSKCore = None
