"""(stub — populated in this round)"""
